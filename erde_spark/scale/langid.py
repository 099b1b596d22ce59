"""Trainable character-n-gram Naive Bayes language identification.

The reference engine has no language identifier; every real curation
pipeline (CCNet, RefinedWeb, FineWeb) puts one in front of every other
filter, so this repo carries it as a first-class operator. The design
is the curation-pipeline standard reduced to a closed form: character
1-3-gram multinomial Naive Bayes (Cavnar & Trenkle 1994's n-gram
profiles with proper Bayesian scoring, the same family fastText's
langid reduces to for short texts), trained on a checked-in seed
corpus covering 30 languages across 9 scripts (Latin, Cyrillic,
Greek, Arabic, Hebrew, Devanagari, Thai, Han/Kana, Hangul).

Everything is engine-replayable by construction:

- training is ONE aggregation over the (tiny) seed corpus — count
  n-grams per language, Laplace-smooth, log — no iteration, so any SQL
  engine reproduces the model exactly from the same corpus constants;
- scoring is FIXED-POINT: per-n-gram log-probabilities are quantized
  to integer milli-units and per-document sums run in exact integer
  arithmetic, so results are independent of partitioning, summation
  order, and engine (float sums are none of those);
- the scale shape is broadcast-model map-side join + one
  map-side-combined groupBy: the corpus is never shuffled by token,
  and per-document work is bounded by ``prefix_chars`` (language
  identity is decided in the first couple hundred characters — CCNet
  scores truncated text for the same reason).

Scoring cost at 100 TB: ~3x ``prefix_chars`` gram rows per document
into a partial aggregate that collapses to one row of 30 longs per
document before the (only) shuffle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed-point quantization: per-gram log-probabilities are stored as
#: integer multiples of 1/LANGID_SCALE. Milli-units keep the chance
#: that a 1-ulp ln() difference between engines flips a quantized
#: value below ~1e-11 per model row while leaving argmax margins
#: (hundreds of units) untouched.
LANGID_SCALE = 1000

NGRAM_SIZES = (1, 2, 3)

#: Checked-in seed corpus: everyday sentences written for this repo
#: (market / weather / train / library / children motifs repeated
#: across languages so the classes differ by LANGUAGE, not topic).
#: ~400-600 chars per language is plenty for char-trigram NB; the
#: point of the shared motifs is that discriminative mass lands on
#: function words and script, exactly what transfers to real text.
LANGID_CORPUS = {
    'en': ("the quick brown fox jumps over the lazy dog. i went to the m"
           "arket this morning and bought some fresh bread. she said tha"
           "t the weather would be better tomorrow. we have been waiting"
           " for the train for more than an hour. this is the most impor"
           "tant thing you need to know. the children are playing in the"
           " garden near the old house. what time does the shop open on "
           "sunday. there is a lot of work to do before the end of the w"
           "eek. my brother works in the city and comes home on friday. "
           "i do not know where she put the books. it rained all day yes"
           "terday and the streets were wet. we often eat dinner togethe"
           "r at my grandmother's place. how much does this cost and can"
           " i pay with card. the government announced new measures to s"
           "upport the economy. the minister said that prices would cont"
           "inue to rise this year. the city council approved the plan f"
           "or the new road. workers at the factory went on strike last "
           "week. the president will meet the leaders of the neighboring"
           " countries."),
    'de': ("der schnelle braune fuchs springt über den faulen hund. ich "
           "bin heute morgen zum markt gegangen und habe frisches brot g"
           "ekauft. sie sagte, dass das wetter morgen besser sein würde."
           " wir warten schon seit über einer stunde auf den zug. das is"
           "t das wichtigste, was du wissen musst. die kinder spielen im"
           " garten neben dem alten haus. um wie viel uhr öffnet das ges"
           "chäft am sonntag. es gibt noch viel arbeit vor dem ende der "
           "woche. mein bruder arbeitet in der stadt und kommt am freita"
           "g nach hause. ich weiß nicht, wo sie die bücher hingelegt ha"
           "t. gestern hat es den ganzen tag geregnet und die straßen wa"
           "ren nass. wir essen oft zusammen bei meiner großmutter zu ab"
           "end. wie viel kostet das und kann ich mit karte zahlen. die "
           "regierung kündigte neue maßnahmen zur unterstützung der wirt"
           "schaft an. der minister sagte, dass die preise in diesem jah"
           "r weiter steigen würden. der stadtrat billigte den plan für "
           "die neue straße. die arbeiter der fabrik traten letzte woche"
           " in den streik. der präsident wird die führer der nachbarlän"
           "der treffen."),
    'fr': ("le rapide renard brun saute par-dessus le chien paresseux. j"
           "e suis allé au marché ce matin et j'ai acheté du pain frais."
           " elle a dit que le temps serait meilleur demain. nous attend"
           "ons le train depuis plus d'une heure. c'est la chose la plus"
           " importante que tu dois savoir. les enfants jouent dans le j"
           "ardin près de la vieille maison. à quelle heure ouvre le mag"
           "asin le dimanche. il reste beaucoup de travail avant la fin "
           "de la semaine. mon frère travaille en ville et rentre à la m"
           "aison le vendredi. je ne sais pas où elle a mis les livres. "
           "hier il a plu toute la journée et les rues étaient mouillées"
           ". nous mangeons souvent ensemble chez ma grand-mère. combien"
           " ça coûte et est-ce que je peux payer par carte. le gouverne"
           "ment a annoncé de nouvelles mesures pour soutenir l'économie"
           ". le ministre a déclaré que les prix continueraient d'augmen"
           "ter cette année. le conseil municipal a approuvé le plan de "
           "la nouvelle route. les ouvriers de l'usine se sont mis en gr"
           "ève la semaine dernière. le président rencontrera les dirige"
           "ants des pays voisins."),
    'es': ("el rápido zorro marrón salta sobre el perro perezoso. fui al"
           " mercado esta mañana y compré pan fresco. ella dijo que el t"
           "iempo sería mejor mañana. llevamos más de una hora esperando"
           " el tren. esto es lo más importante que necesitas saber. los"
           " niños juegan en el jardín cerca de la casa vieja. a qué hor"
           "a abre la tienda el domingo. queda mucho trabajo por hacer a"
           "ntes del fin de la semana. mi hermano trabaja en la ciudad y"
           " vuelve a casa el viernes. no sé dónde puso ella los libros."
           " ayer llovió todo el día y las calles estaban mojadas. a men"
           "udo cenamos juntos en casa de mi abuela. cuánto cuesta esto "
           "y puedo pagar con tarjeta. la biblioteca de la ciudad tiene "
           "muchos libros nuevos y siempre está abierta por la tarde. de"
           "spués de cenar vemos una película y hablamos de nuestras cos"
           "as. me gusta mucho leer por la noche cuando todo está tranqu"
           "ilo. el gobierno anunció nuevas medidas para apoyar la econo"
           "mía. el ministro dijo que los precios seguirían subiendo est"
           "e año. el ayuntamiento aprobó el plan para la nueva carreter"
           "a. los trabajadores de la fábrica se declararon en huelga la"
           " semana pasada. el presidente se reunirá con los líderes de "
           "los países vecinos."),
    'pt': ("a rápida raposa marrom salta sobre o cão preguiçoso. fui ao "
           "mercado esta manhã e comprei pão fresco. ela disse que o tem"
           "po estaria melhor amanhã. estamos esperando o trem há mais d"
           "e uma hora. isto é a coisa mais importante que você precisa "
           "saber. as crianças brincam no jardim perto da casa velha. a "
           "que horas a loja abre no domingo. ainda há muito trabalho a "
           "fazer antes do fim da semana. meu irmão trabalha na cidade e"
           " volta para casa na sexta-feira. não sei onde ela colocou os"
           " livros. ontem choveu o dia todo e as ruas ficaram molhadas."
           " muitas vezes jantamos juntos na casa da minha avó. quanto c"
           "usta isso e posso pagar com cartão. a biblioteca da cidade t"
           "em muitos livros novos e está sempre aberta à tarde. depois "
           "do jantar vemos um filme e falamos das nossas coisas. eu gos"
           "to muito de ler à noite quando tudo está tranquilo. o govern"
           "o anunciou novas medidas para apoiar a economia. o ministro "
           "disse que os preços continuariam a subir este ano. a câmara "
           "municipal aprovou o plano para a nova estrada. os trabalhado"
           "res da fábrica entraram em greve na semana passada. o presid"
           "ente vai se reunir com os líderes dos países vizinhos."),
    'it': ("la veloce volpe marrone salta sopra il cane pigro. sono anda"
           "to al mercato questa mattina e ho comprato del pane fresco. "
           "lei ha detto che il tempo sarebbe stato migliore domani. asp"
           "ettiamo il treno da più di un'ora. questa è la cosa più impo"
           "rtante che devi sapere. i bambini giocano nel giardino vicin"
           "o alla vecchia casa. a che ora apre il negozio la domenica. "
           "c'è ancora molto lavoro da fare prima della fine della setti"
           "mana. mio fratello lavora in città e torna a casa il venerdì"
           ". non so dove lei abbia messo i libri. ieri è piovuto tutto "
           "il giorno e le strade erano bagnate. spesso ceniamo insieme "
           "a casa di mia nonna. quanto costa questo e posso pagare con "
           "la carta. la biblioteca della città ha molti libri nuovi ed "
           "è sempre aperta il pomeriggio. dopo cena guardiamo un film e"
           " parliamo delle nostre cose. mi piace molto leggere la sera "
           "quando tutto è tranquillo. il governo ha annunciato nuove mi"
           "sure per sostenere l'economia. il ministro ha detto che i pr"
           "ezzi continueranno a salire quest'anno. il consiglio comunal"
           "e ha approvato il piano per la nuova strada. gli operai dell"
           "a fabbrica hanno scioperato la settimana scorsa. il presiden"
           "te incontrerà i leader dei paesi vicini."),
    'nl': ("de snelle bruine vos springt over de luie hond. ik ben vanoc"
           "htend naar de markt gegaan en heb vers brood gekocht. ze zei"
           " dat het weer morgen beter zou zijn. we wachten al meer dan "
           "een uur op de trein. dit is het belangrijkste wat je moet we"
           "ten. de kinderen spelen in de tuin bij het oude huis. hoe la"
           "at gaat de winkel op zondag open. er is nog veel werk te doe"
           "n voor het einde van de week. mijn broer werkt in de stad en"
           " komt vrijdag naar huis. ik weet niet waar ze de boeken heef"
           "t gelegd. gisteren regende het de hele dag en de straten war"
           "en nat. we eten vaak samen bij mijn grootmoeder. hoeveel kos"
           "t dit en kan ik met de kaart betalen. de regering kondigde n"
           "ieuwe maatregelen aan om de economie te ondersteunen. de min"
           "ister zei dat de prijzen dit jaar verder zouden stijgen. de "
           "gemeenteraad keurde het plan voor de nieuwe weg goed. de arb"
           "eiders van de fabriek gingen vorige week in staking. de pres"
           "ident zal de leiders van de buurlanden ontmoeten."),
    'sv': ("den snabba bruna räven hoppar över den lata hunden. jag gick"
           " till marknaden i morse och köpte färskt bröd. hon sa att vä"
           "dret skulle bli bättre i morgon. vi har väntat på tåget i öv"
           "er en timme. det här är det viktigaste du behöver veta. barn"
           "en leker i trädgården nära det gamla huset. hur dags öppnar "
           "affären på söndag. det finns mycket arbete kvar före veckans"
           " slut. min bror arbetar i staden och kommer hem på fredag. j"
           "ag vet inte var hon lade böckerna. igår regnade det hela dag"
           "en och gatorna var våta. vi äter ofta middag tillsammans hos"
           " min mormor. hur mycket kostar det och kan jag betala med ko"
           "rt. hon bestämde sig för att läsa en bok istället för att ti"
           "tta på tv. det var mycket kallt ute igår kväll och vägarna v"
           "ar hala. regeringen tillkännagav nya åtgärder för att stödja"
           " ekonomin. ministern sade att priserna skulle fortsätta att "
           "stiga i år. kommunfullmäktige godkände planen för den nya vä"
           "gen. arbetarna på fabriken gick ut i strejk förra veckan. pr"
           "esidenten kommer att träffa ledarna för grannländerna."),
    'da': ("den hurtige brune ræv springer over den dovne hund. jeg gik "
           "på markedet i morges og købte frisk brød. hun sagde, at vejr"
           "et ville blive bedre i morgen. vi har ventet på toget i over"
           " en time. det her er det vigtigste, du skal vide. børnene le"
           "ger i haven ved det gamle hus. hvornår åbner butikken om søn"
           "dagen. der er stadig meget arbejde, der skal gøres inden uge"
           "ns udgang. min bror arbejder i byen og kommer hjem på fredag"
           ". jeg ved ikke, hvor hun lagde bøgerne. i går regnede det he"
           "le dagen, og gaderne var våde. vi spiser tit aftensmad samme"
           "n hos min mormor. hvor meget koster det, og kan jeg betale m"
           "ed kort. om aftenen lukker vi altid døren og slukker lyset. "
           "toget ankommer tidligt, måske allerede klokken syv. de havde"
           " ikke noget at spise, så de gik ud for at købe noget. det bl"
           "iver måske regnvejr i eftermiddag. han besluttede at gå en l"
           "ang tur, selvom det var meget koldt udenfor. hun forsøgte at"
           " finde noget at lave i weekenden. regeringen annoncerede nye"
           " tiltag for at støtte økonomien. ministeren sagde, at priser"
           "ne ville fortsætte med at stige i år. byrådet godkendte plan"
           "en for den nye vej. arbejderne på fabrikken gik i strejke i "
           "sidste uge. præsidenten vil mødes med lederne af nabolandene"
           "."),
    'nb': ("den raske brune reven hopper over den late hunden. jeg gikk "
           "til markedet i morges og kjøpte ferskt brød. hun sa at været"
           " ville bli bedre i morgen. vi har ventet på toget i over en "
           "time. dette er det viktigste du trenger å vite. barna leker "
           "i hagen ved det gamle huset. når åpner butikken på søndag. d"
           "et er fortsatt mye arbeid som må gjøres før uken er slutt. b"
           "roren min jobber i byen og kommer hjem på fredag. jeg vet ik"
           "ke hvor hun la bøkene. i går regnet det hele dagen, og gaten"
           "e var våte. vi spiser ofte middag sammen hos bestemoren min."
           " hvor mye koster det, og kan jeg betale med kort. om kvelden"
           " stenger vi alltid døren og slukker lyset. toget kommer tidl"
           "ig, kanskje allerede klokka sju. de hadde ikke noe å spise, "
           "så de gikk ut for å kjøpe noe. det blir kanskje regnvær i et"
           "termiddag. han bestemte seg for å gå en lang tur, selv om de"
           "t var veldig kaldt ute. hun forsøkte å finne noe å gjøre i h"
           "elgen. regjeringen kunngjorde nye tiltak for å støtte økonom"
           "ien. ministeren sa at prisene ville fortsette å stige i år. "
           "kommunestyret godkjente planen for den nye veien. arbeiderne"
           " på fabrikken gikk ut i streik forrige uke. presidenten skal"
           " møte lederne i nabolandene."),
    'fi': ("nopea ruskea kettu hyppää laiskan koiran yli. menin aamulla "
           "torille ja ostin tuoretta leipää. hän sanoi, että sää olisi "
           "huomenna parempi. olemme odottaneet junaa yli tunnin. tämä o"
           "n tärkein asia, joka sinun täytyy tietää. lapset leikkivät p"
           "uutarhassa vanhan talon lähellä. mihin aikaan kauppa aukeaa "
           "sunnuntaina. työtä on vielä paljon ennen viikon loppua. velj"
           "eni työskentelee kaupungissa ja tulee kotiin perjantaina. en"
           " tiedä minne hän laittoi kirjat. eilen satoi koko päivän ja "
           "kadut olivat märät. syömme usein illallista yhdessä isoäitin"
           "i luona. paljonko tämä maksaa ja voinko maksaa kortilla. hal"
           "litus ilmoitti uusista toimista talouden tukemiseksi. minist"
           "eri sanoi, että hinnat jatkavat nousuaan tänä vuonna. kaupun"
           "ginvaltuusto hyväksyi suunnitelman uudesta tiestä. tehtaan t"
           "yöntekijät menivät lakkoon viime viikolla. presidentti tapaa"
           " naapurimaiden johtajat."),
    'pl': ("szybki brązowy lis przeskakuje nad leniwym psem. poszedłem r"
           "ano na targ i kupiłem świeży chleb. powiedziała, że jutro po"
           "goda będzie lepsza. czekamy na pociąg już ponad godzinę. to "
           "jest najważniejsza rzecz, którą musisz wiedzieć. dzieci bawi"
           "ą się w ogrodzie obok starego domu. o której godzinie sklep "
           "otwiera się w niedzielę. przed końcem tygodnia jest jeszcze "
           "dużo pracy. mój brat pracuje w mieście i wraca do domu w pią"
           "tek. nie wiem, gdzie ona położyła książki. wczoraj cały dzie"
           "ń padało i ulice były mokre. często jemy razem kolację u moj"
           "ej babci. ile to kosztuje i czy mogę zapłacić kartą. rząd og"
           "łosił nowe środki wsparcia gospodarki. minister powiedział, "
           "że ceny będą nadal rosły w tym roku. rada miasta zatwierdził"
           "a plan nowej drogi. robotnicy fabryki rozpoczęli strajk w ze"
           "szłym tygodniu. prezydent spotka się z przywódcami sąsiednic"
           "h krajów."),
    'cs': ("rychlá hnědá liška skáče přes líného psa. šel jsem ráno na t"
           "rh a koupil jsem čerstvý chléb. řekla, že zítra bude počasí "
           "lepší. na vlak čekáme už více než hodinu. tohle je ta nejdůl"
           "ežitější věc, kterou musíš vědět. děti si hrají na zahradě u"
           " starého domu. v kolik hodin otevírá obchod v neděli. před k"
           "oncem týdne je ještě hodně práce. můj bratr pracuje ve městě"
           " a vrací se domů v pátek. nevím, kam položila ty knihy. včer"
           "a celý den pršelo a ulice byly mokré. často spolu večeříme u"
           " mé babičky. kolik to stojí a mohu platit kartou. vláda ozná"
           "mila nová opatření na podporu ekonomiky. ministr řekl, že ce"
           "ny letos dále porostou. městská rada schválila plán nové sil"
           "nice. dělníci továrny minulý týden vstoupili do stávky. prez"
           "ident se setká s vůdci sousedních zemí."),
    'hu': ("a gyors barna róka átugrik a lusta kutya felett. ma reggel e"
           "lmentem a piacra és friss kenyeret vettem. azt mondta, hogy "
           "holnap jobb lesz az idő. már több mint egy órája várjuk a vo"
           "natot. ez a legfontosabb dolog, amit tudnod kell. a gyerekek"
           " a kertben játszanak a régi ház mellett. hánykor nyit az üzl"
           "et vasárnap. a hét vége előtt még sok munka van. a bátyám a "
           "városban dolgozik és pénteken jön haza. nem tudom, hová tett"
           "e a könyveket. tegnap egész nap esett az eső és az utcák viz"
           "esek voltak. gyakran vacsorázunk együtt a nagymamámnál. menn"
           "yibe kerül ez és fizethetek kártyával. a kormány új intézked"
           "éseket jelentett be a gazdaság támogatására. a miniszter azt"
           " mondta, hogy az árak idén tovább emelkednek. a városi tanác"
           "s jóváhagyta az új út tervét. a gyár munkásai múlt héten szt"
           "rájkba léptek. az elnök találkozik a szomszédos országok vez"
           "etőivel."),
    'ro': ("vulpea maro rapidă sare peste câinele leneș. am mers azi dim"
           "ineață la piață și am cumpărat pâine proaspătă. ea a spus că"
           " vremea va fi mai bună mâine. așteptăm trenul de mai bine de"
           " o oră. acesta este cel mai important lucru pe care trebuie "
           "să îl știi. copiii se joacă în grădină lângă casa veche. la "
           "ce oră se deschide magazinul duminica. mai este mult de lucr"
           "u înainte de sfârșitul săptămânii. fratele meu lucrează în o"
           "raș și vine acasă vineri. nu știu unde a pus ea cărțile. ier"
           "i a plouat toată ziua și străzile erau ude. deseori luăm cin"
           "a împreună la bunica mea. cât costă asta și pot plăti cu car"
           "dul. biblioteca orașului are multe cărți noi și este deschis"
           "ă seara. după cină ne uităm la un film și vorbim despre lucr"
           "urile noastre. guvernul a anunțat noi măsuri pentru sprijini"
           "rea economiei. ministrul a spus că prețurile vor continua să"
           " crească anul acesta. consiliul local a aprobat planul pentr"
           "u noul drum. muncitorii fabricii au intrat în grevă săptămân"
           "a trecută. președintele se va întâlni cu liderii țărilor vec"
           "ine."),
    'tr': ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar. bu sa"
           "bah pazara gittim ve taze ekmek aldım. yarın havanın daha iy"
           "i olacağını söyledi. bir saatten fazladır treni bekliyoruz. "
           "bilmen gereken en önemli şey bu. çocuklar eski evin yanındak"
           "i bahçede oynuyor. dükkan pazar günü saat kaçta açılıyor. ha"
           "fta bitmeden önce yapılacak çok iş var. kardeşim şehirde çal"
           "ışıyor ve cuma günü eve geliyor. kitapları nereye koyduğunu "
           "bilmiyorum. dün bütün gün yağmur yağdı ve sokaklar ıslaktı. "
           "sık sık büyükannemde birlikte akşam yemeği yeriz. bu ne kada"
           "r ve kartla ödeyebilir miyim. hükümet ekonomiyi desteklemek "
           "için yeni önlemler açıkladı. bakan fiyatların bu yıl artmaya"
           " devam edeceğini söyledi. belediye meclisi yeni yol planını "
           "onayladı. fabrika işçileri geçen hafta greve gitti. cumhurba"
           "şkanı komşu ülkelerin liderleriyle görüşecek."),
    'vi': ("con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng. sáng nay"
           " tôi đi chợ và mua bánh mì tươi. cô ấy nói rằng ngày mai thờ"
           "i tiết sẽ đẹp hơn. chúng tôi đã đợi tàu hơn một giờ rồi. đây"
           " là điều quan trọng nhất mà bạn cần biết. bọn trẻ đang chơi "
           "trong vườn cạnh ngôi nhà cũ. cửa hàng mở cửa lúc mấy giờ vào"
           " chủ nhật. còn nhiều việc phải làm trước cuối tuần. anh trai"
           " tôi làm việc trong thành phố và về nhà vào thứ sáu. tôi khô"
           "ng biết cô ấy để những cuốn sách ở đâu. hôm qua trời mưa cả "
           "ngày và đường phố ướt hết. chúng tôi thường ăn tối cùng nhau"
           " ở nhà bà tôi. cái này giá bao nhiêu và tôi có thể trả bằng "
           "thẻ không. chính phủ công bố các biện pháp mới để hỗ trợ nền"
           " kinh tế. bộ trưởng cho biết giá cả sẽ tiếp tục tăng trong n"
           "ăm nay. hội đồng thành phố đã phê duyệt kế hoạch cho con đườ"
           "ng mới. công nhân nhà máy đã đình công vào tuần trước. tổng "
           "thống sẽ gặp các nhà lãnh đạo của các nước láng giềng."),
    'id': ("rubah coklat yang cepat melompati anjing yang malas. tadi pa"
           "gi saya pergi ke pasar dan membeli roti segar. dia berkata b"
           "ahwa cuaca akan lebih baik besok. kami sudah menunggu kereta"
           " lebih dari satu jam. ini adalah hal terpenting yang perlu k"
           "amu ketahui. anak-anak bermain di kebun dekat rumah tua itu."
           " jam berapa toko buka pada hari minggu. masih banyak pekerja"
           "an sebelum akhir pekan. kakak saya bekerja di kota dan pulan"
           "g ke rumah pada hari jumat. saya tidak tahu di mana dia mele"
           "takkan buku-buku itu. kemarin hujan sepanjang hari dan jalan"
           "-jalan menjadi basah. kami sering makan malam bersama di rum"
           "ah nenek saya. berapa harganya ini dan bisakah saya membayar"
           " dengan kartu. pemerintah mengumumkan langkah-langkah baru u"
           "ntuk mendukung perekonomian. menteri mengatakan bahwa harga "
           "akan terus naik tahun ini. dewan kota menyetujui rencana unt"
           "uk jalan baru. para pekerja pabrik melakukan mogok kerja min"
           "ggu lalu. presiden akan bertemu dengan para pemimpin negara "
           "tetangga."),
    'ru': ("быстрая коричневая лиса перепрыгивает через ленивую собаку. "
           "утром я пошёл на рынок и купил свежий хлеб. она сказала, что"
           " завтра погода будет лучше. мы ждём поезд уже больше часа. э"
           "то самое важное, что тебе нужно знать. дети играют в саду во"
           "зле старого дома. во сколько открывается магазин в воскресен"
           "ье. до конца недели ещё много работы. мой брат работает в го"
           "роде и приезжает домой в пятницу. я не знаю, куда она положи"
           "ла книги. вчера весь день шёл дождь, и улицы были мокрыми. м"
           "ы часто ужинаем вместе у моей бабушки. сколько это стоит и м"
           "огу ли я заплатить картой. правительство объявило о новых ме"
           "рах поддержки экономики. министр сказал, что цены продолжат "
           "расти в этом году. городской совет одобрил план новой дороги"
           ". рабочие завода на прошлой неделе объявили забастовку. през"
           "идент встретится с лидерами соседних стран."),
    'uk': ("швидка коричнева лисиця перестрибує через ледачого собаку. в"
           "ранці я пішов на ринок і купив свіжий хліб. вона сказала, що"
           " завтра погода буде кращою. ми чекаємо на потяг уже понад го"
           "дину. це найважливіше, що тобі потрібно знати. діти граються"
           " в саду біля старого будинку. о котрій годині відчиняється к"
           "рамниця в неділю. до кінця тижня ще багато роботи. мій брат "
           "працює в місті і приїжджає додому в п'ятницю. я не знаю, куд"
           "и вона поклала книги. вчора цілий день ішов дощ, і вулиці бу"
           "ли мокрі. ми часто вечеряємо разом у моєї бабусі. скільки це"
           " коштує і чи можу я заплатити карткою. уряд оголосив про нов"
           "і заходи підтримки економіки. міністр сказав, що ціни продов"
           "жать зростати цього року. міська рада схвалила план нової до"
           "роги. робітники заводу минулого тижня оголосили страйк. през"
           "идент зустрінеться з лідерами сусідніх країн."),
    'bg': ("бързата кафява лисица прескача мързеливото куче. сутринта от"
           "идох на пазара и купих пресен хляб. тя каза, че утре времето"
           " ще бъде по-хубаво. чакаме влака повече от час. това е най-в"
           "ажното, което трябва да знаеш. децата играят в градината до "
           "старата къща. в колко часа отваря магазинът в неделя. до кра"
           "я на седмицата има още много работа. брат ми работи в града "
           "и се прибира у дома в петък. не знам къде тя е сложила книги"
           "те. вчера валя цял ден и улиците бяха мокри. често вечеряме "
           "заедно у баба ми. колко струва това и мога ли да платя с кар"
           "та. правителството обяви нови мерки в подкрепа на икономикат"
           "а. министърът каза, че цените ще продължат да растат тази го"
           "дина. градският съвет одобри плана за новия път. работниците"
           " от завода миналата седмица обявиха стачка. президентът ще с"
           "е срещне с лидерите на съседните страни."),
    'el': ("η γρήγορη καφέ αλεπού πηδάει πάνω από τον τεμπέλη σκύλο. το "
           "πρωί πήγα στην αγορά και αγόρασα φρέσκο ψωμί. είπε ότι αύριο"
           " ο καιρός θα είναι καλύτερος. περιμένουμε το τρένο πάνω από "
           "μία ώρα. αυτό είναι το πιο σημαντικό πράγμα που πρέπει να ξέ"
           "ρεις. τα παιδιά παίζουν στον κήπο κοντά στο παλιό σπίτι. τι "
           "ώρα ανοίγει το μαγαζί την κυριακή. μένει ακόμα πολλή δουλειά"
           " πριν από το τέλος της εβδομάδας. ο αδερφός μου δουλεύει στη"
           "ν πόλη και γυρίζει σπίτι την παρασκευή. δεν ξέρω πού έβαλε ε"
           "κείνη τα βιβλία. χθες έβρεχε όλη μέρα και οι δρόμοι ήταν βρε"
           "γμένοι. συχνά τρώμε βραδινό μαζί στης γιαγιάς μου. πόσο κοστ"
           "ίζει αυτό και μπορώ να πληρώσω με κάρτα. η κυβέρνηση ανακοίν"
           "ωσε νέα μέτρα για τη στήριξη της οικονομίας. ο υπουργός είπε"
           " ότι οι τιμές θα συνεχίσουν να αυξάνονται φέτος. το δημοτικό"
           " συμβούλιο ενέκρινε το σχέδιο για τον νέο δρόμο. οι εργάτες "
           "του εργοστασίου απήργησαν την περασμένη εβδομάδα. ο πρόεδρος"
           " θα συναντηθεί με τους ηγέτες των γειτονικών χωρών."),
    'ar': ("الثعلب البني السريع يقفز فوق الكلب الكسول. ذهبت إلى السوق هذ"
           "ا الصباح واشتريت خبزا طازجا. قالت إن الطقس سيكون أفضل غدا. ن"
           "نتظر القطار منذ أكثر من ساعة. هذا هو أهم شيء تحتاج إلى معرفت"
           "ه. يلعب الأطفال في الحديقة قرب البيت القديم. في أي ساعة يفتح"
           " المتجر يوم الأحد. لا يزال هناك الكثير من العمل قبل نهاية ال"
           "أسبوع. يعمل أخي في المدينة ويعود إلى البيت يوم الجمعة. لا أع"
           "رف أين وضعت الكتب. أمس أمطرت طوال اليوم وكانت الشوارع مبللة."
           " كثيرا ما نتناول العشاء معا عند جدتي. كم يكلف هذا وهل يمكنني"
           " الدفع بالبطاقة. أعلنت الحكومة عن إجراءات جديدة لدعم الاقتصا"
           "د. قال الوزير إن الأسعار ستواصل الارتفاع هذا العام. وافق مجل"
           "س المدينة على خطة الطريق الجديد. أضرب عمال المصنع الأسبوع ال"
           "ماضي. سيلتقي الرئيس بقادة الدول المجاورة."),
    'fa': ("روباه قهوه‌ای سریع از روی سگ تنبل می‌پرد. امروز صبح به بازار"
           " رفتم و نان تازه خریدم. او گفت که فردا هوا بهتر خواهد بود. ب"
           "یش از یک ساعت است که منتظر قطار هستیم. این مهم‌ترین چیزی است"
           " که باید بدانی. بچه‌ها در باغ نزدیک خانه قدیمی بازی می‌کنند."
           " فروشگاه یکشنبه ساعت چند باز می‌شود. هنوز کارهای زیادی تا پا"
           "یان هفته مانده است. برادرم در شهر کار می‌کند و جمعه به خانه "
           "می‌آید. نمی‌دانم او کتاب‌ها را کجا گذاشت. دیروز تمام روز بار"
           "ان بارید و خیابان‌ها خیس بودند. ما اغلب با هم در خانه مادربز"
           "رگم شام می‌خوریم. این چقدر قیمت دارد و آیا می‌توانم با کارت "
           "پرداخت کنم. دولت اقدامات جدیدی برای حمایت از اقتصاد اعلام کر"
           "د. وزیر گفت که قیمت‌ها امسال همچنان افزایش خواهند یافت. شورا"
           "ی شهر طرح جاده جدید را تصویب کرد. کارگران کارخانه هفته گذشته"
           " اعتصاب کردند. رئیس‌جمهور با رهبران کشورهای همسایه دیدار خوا"
           "هد کرد."),
    'he': ("השועל החום המהיר קופץ מעל הכלב העצלן. הלכתי לשוק הבוקר וקנית"
           "י לחם טרי. היא אמרה שמחר מזג האוויר יהיה טוב יותר. אנחנו מחכ"
           "ים לרכבת כבר יותר משעה. זה הדבר הכי חשוב שאתה צריך לדעת. היל"
           "דים משחקים בגינה ליד הבית הישן. באיזו שעה נפתחת החנות ביום ר"
           "אשון. יש עוד הרבה עבודה לפני סוף השבוע. אחי עובד בעיר וחוזר "
           "הביתה ביום שישי. אני לא יודע איפה היא שמה את הספרים. אתמול י"
           "רד גשם כל היום והרחובות היו רטובים. אנחנו אוכלים לעתים קרובו"
           "ת ארוחת ערב יחד אצל סבתא שלי. כמה זה עולה והאם אפשר לשלם בכר"
           "טיס. הממשלה הודיעה על צעדים חדשים לתמיכה בכלכלה. השר אמר שהמ"
           "חירים ימשיכו לעלות השנה. מועצת העיר אישרה את התוכנית לכביש ה"
           "חדש. פועלי המפעל שבתו בשבוע שעבר. הנשיא ייפגש עם מנהיגי המדי"
           "נות השכנות."),
    'hi': ("तेज़ भूरी लोमड़ी आलसी कुत्ते के ऊपर से कूदती है। मैं आज सुबह"
           " बाज़ार गया और ताज़ी रोटी खरीदी। उसने कहा कि कल मौसम बेहतर ह"
           "ोगा। हम एक घंटे से ज़्यादा समय से ट्रेन का इंतज़ार कर रहे है"
           "ं। यह सबसे ज़रूरी बात है जो तुम्हें जाननी चाहिए। बच्चे पुरान"
           "े घर के पास बगीचे में खेल रहे हैं। दुकान रविवार को कितने बजे"
           " खुलती है। सप्ताह के अंत से पहले अभी बहुत काम बाकी है। मेरा "
           "भाई शहर में काम करता है और शुक्रवार को घर आता है। मुझे नहीं "
           "पता कि उसने किताबें कहाँ रखीं। कल पूरे दिन बारिश होती रही और"
           " सड़कें गीली थीं। हम अक्सर अपनी दादी के घर साथ में खाना खाते"
           " हैं। इसकी कीमत कितनी है और क्या मैं कार्ड से भुगतान कर सकता"
           " हूँ। सरकार ने अर्थव्यवस्था को सहारा देने के लिए नए उपायों क"
           "ी घोषणा की। मंत्री ने कहा कि कीमतें इस साल बढ़ती रहेंगी। नगर"
           " परिषद ने नई सड़क की योजना को मंजूरी दी। कारखाने के मजदूरों "
           "ने पिछले हफ्ते हड़ताल की। राष्ट्रपति पड़ोसी देशों के नेताओं "
           "से मिलेंगे।"),
    'zh': ("敏捷的棕色狐狸跳过懒惰的狗。今天早上我去市场买了新鲜的面包。她说明天天气会更好。我们等火车已经等了一个多小时。这是你需要"
           "知道的最重要的事情。孩子们在老房子旁边的花园里玩耍。商店星期天几点开门。这个星期结束之前还有很多工作要做。 我哥哥在城里"
           "工作,星期五回家。我不知道她把书放在哪里了。昨天下了一整天的雨,街道都湿了。我们经常在奶奶家一起吃晚饭。这个多少钱,我可"
           "以用卡付款吗。 政府宣布了支持经济的新措施。部长表示,价格今年将继续上涨。市议会批准了新道路的规划。工厂工人上周举行了罢"
           "工。总统将会见邻国领导人。"),
    'ja': ("素早い茶色の狐は怠け者の犬を飛び越える。今朝、市場へ行って新しいパンを買いました。彼女は明日の天気はもっと良くなると言い"
           "ました。私たちは一時間以上も電車を待っています。これはあなたが知っておくべき最も大切なことです。子供たちは古い家のそばの"
           "庭で遊んでいます。店は日曜日に何時に開きますか。週末までにまだたくさんの仕事があります。 兄は町で働いていて、金曜日に家"
           "に帰ってきます。彼女が本をどこに置いたのか分かりません。昨日は一日中雨が降って、道路が濡れていました。私たちはよく祖母の"
           "家で一緒に夕食を食べます。これはいくらですか、カードで払えますか。 政府は経済を支援するための新しい対策を発表しました。"
           "大臣は物価が今年も上がり続けると述べました。市議会は新しい道路の計画を承認しました。工場の労働者は先週ストライキを行いま"
           "した。大統領は隣国の指導者と会談する予定です。"),
    'ko': ("빠른 갈색 여우가 게으른 개를 뛰어넘는다. 오늘 아침에 시장에 가서 신선한 빵을 샀다. 그녀는 내일 날씨가 "
           "더 좋아질 거라고 말했다. 우리는 한 시간 넘게 기차를 기다리고 있다. 이것은 네가 알아야 할 가장 중요한 "
           "것이다. 아이들이 오래된 집 옆 정원에서 놀고 있다. 가게는 일요일에 몇 시에 문을 여는가. 주말 전에 아직"
           " 할 일이 많다. 우리 형은 도시에서 일하고 금요일에 집에 온다. 그녀가 책을 어디에 두었는지 모르겠다. 어"
           "제는 하루 종일 비가 와서 길이 젖었다. 우리는 자주 할머니 댁에서 함께 저녁을 먹는다. 이것은 얼마이고 카"
           "드로 계산할 수 있나요. 정부는 경제를 지원하기 위한 새로운 조치를 발표했다. 장관은 물가가 올해도 계속 오"
           "를 것이라고 말했다. 시의회는 새 도로 계획을 승인했다. 공장 노동자들은 지난주 파업에 들어갔다. 대통령은 "
           "이웃 나라 지도자들을 만날 예정이다."),
    'th': ("สุนัขจิ้งจอกสีน้ำตาลตัวเร็วกระโดดข้ามสุนัขขี้เกียจ เช้านี้ฉั"
           "นไปตลาดและซื้อขนมปังสด เธอบอกว่าพรุ่งนี้อากาศจะดีขึ้น เรารอร"
           "ถไฟมานานกว่าหนึ่งชั่วโมงแล้ว นี่คือสิ่งสำคัญที่สุดที่คุณต้อง"
           "รู้ เด็กๆ เล่นอยู่ในสวนใกล้บ้านหลังเก่า ร้านค้าเปิดกี่โมงในว"
           "ันอาทิตย์ ยังมีงานอีกมากก่อนสิ้นสัปดาห์ พี่ชายของฉันทำงานในเ"
           "มืองและกลับบ้านวันศุกร์ ฉันไม่รู้ว่าเธอวางหนังสือไว้ที่ไหน เ"
           "มื่อวานฝนตกทั้งวันและถนนก็เปียก เราทานอาหารเย็นด้วยกันที่บ้า"
           "นคุณยายบ่อยๆ อันนี้ราคาเท่าไหร่และจ่ายด้วยบัตรได้ไหม รัฐบาลป"
           "ระกาศมาตรการใหม่เพื่อสนับสนุนเศรษฐกิจ รัฐมนตรีกล่าวว่าราคาจะ"
           "ยังคงเพิ่มขึ้นในปีนี้ สภาเมืองอนุมัติแผนถนนสายใหม่ คนงานโรงง"
           "านนัดหยุดงานเมื่อสัปดาห์ที่แล้ว ประธานาธิบดีจะพบกับผู้นำประเ"
           "ทศเพื่อนบ้าน"),
}

#: Held-out evaluation sentences — same style, DISJOINT from the
#: training corpus. The driver gate plants these by doc_id arithmetic
#: and checks the identifier recovers every language; the accuracy
#: pytest sweeps all of them.
EVAL_SENTENCES = {
    'en': ['he could not find his keys anywhere in the house.',
           'the library closes at nine in the evening and opens early.',
           'they decided to walk home because the bus was very late.'],
    'de': ['er konnte seine schlüssel nirgendwo im haus finden.',
           'die bibliothek schließt abends um neun uhr und öffnet früh.',
           'sie beschlossen zu fuß nach hause zu gehen, weil der bus '
           'sehr spät kam.'],
    'fr': ['il ne trouvait ses clés nulle part dans la maison.',
           'la bibliothèque ferme à neuf heures du soir et ouvre tôt.',
           "ils ont décidé de rentrer à pied parce que le bus était "
           "très en retard."],
    'es': ['no podía encontrar sus llaves en ninguna parte de la casa.',
           'la biblioteca cierra a las nueve de la noche y abre '
           'temprano.',
           'decidieron caminar a casa porque el autobús llegaba muy '
           'tarde.'],
    'pt': ['ele não conseguia encontrar as chaves em lugar nenhum da '
           'casa.',
           'a biblioteca fecha às nove da noite e abre cedo.',
           'eles decidiram ir para casa a pé porque o ônibus estava '
           'muito atrasado.'],
    'it': ['non riusciva a trovare le sue chiavi da nessuna parte in '
           'casa.',
           'la biblioteca chiude alle nove di sera e apre presto.',
           "hanno deciso di tornare a casa a piedi perché l'autobus "
           "era molto in ritardo."],
    'nl': ['hij kon zijn sleutels nergens in het huis vinden.',
           "de bibliotheek sluit om negen uur 's avonds en gaat vroeg "
           "open.",
           'ze besloten naar huis te lopen omdat de bus veel te laat '
           'was.'],
    'sv': ['han kunde inte hitta sina nycklar någonstans i huset.',
           'biblioteket stänger klockan nio på kvällen och öppnar '
           'tidigt.',
           'de bestämde sig för att gå hem eftersom bussen var mycket '
           'försenad.'],
    'da': ['han kunne ikke finde sine nøgler nogen steder i huset.',
           'biblioteket lukker klokken ni om aftenen og åbner tidligt.',
           'de besluttede at gå hjem, fordi bussen var meget '
           'forsinket.'],
    'nb': ['han kunne ikke finne nøklene sine noen steder i huset.',
           'biblioteket stenger klokken ni om kvelden og åpner tidlig.',
           'de bestemte seg for å gå hjem fordi bussen var veldig '
           'forsinket.'],
    'fi': ['hän ei löytänyt avaimiaan mistään talosta.',
           'kirjasto sulkeutuu yhdeksältä illalla ja aukeaa aikaisin.',
           'he päättivät kävellä kotiin, koska bussi oli pahasti '
           'myöhässä.'],
    'pl': ['nigdzie w domu nie mógł znaleźć swoich kluczy.',
           'biblioteka zamyka się o dziewiątej wieczorem i otwiera '
           'wcześnie.',
           'postanowili wrócić do domu pieszo, bo autobus bardzo się '
           'spóźniał.'],
    'cs': ['nikde v domě nemohl najít své klíče.',
           'knihovna zavírá v devět hodin večer a otevírá brzy.',
           'rozhodli se jít domů pěšky, protože autobus měl velké '
           'zpoždění.'],
    'hu': ['sehol sem találta a kulcsait a házban.',
           'a könyvtár este kilenckor zár be és korán nyit.',
           'úgy döntöttek, hogy gyalog mennek haza, mert nagyon '
           'késett a busz.'],
    'ro': ['nu își găsea cheile nicăieri în casă.',
           'biblioteca se închide la ora nouă seara și se deschide '
           'devreme.',
           'au decis să meargă acasă pe jos pentru că autobuzul '
           'întârzia foarte mult.'],
    'tr': ['anahtarlarını evin hiçbir yerinde bulamadı.',
           'kütüphane akşam dokuzda kapanıyor ve erken açılıyor.',
           'otobüs çok geciktiği için eve yürüyerek dönmeye karar '
           'verdiler.'],
    'vi': ['anh ấy không tìm thấy chìa khóa ở đâu trong nhà.',
           'thư viện đóng cửa lúc chín giờ tối và mở cửa sớm.',
           'họ quyết định đi bộ về nhà vì xe buýt đến rất muộn.'],
    'id': ['dia tidak dapat menemukan kuncinya di mana pun di rumah.',
           'perpustakaan tutup pukul sembilan malam dan buka pagi '
           'sekali.',
           'mereka memutuskan berjalan kaki pulang karena bus sangat '
           'terlambat.'],
    'ru': ['он нигде в доме не мог найти свои ключи.',
           'библиотека закрывается в девять часов вечера и открывается '
           'рано.',
           'они решили пойти домой пешком, потому что автобус сильно '
           'опаздывал.'],
    'uk': ['він ніде в будинку не міг знайти свої ключі.',
           "бібліотека зачиняється о дев'ятій годині вечора і "
           "відчиняється рано.",
           'вони вирішили піти додому пішки, бо автобус дуже '
           'запізнювався.'],
    'bg': ['той никъде в къщата не можеше да намери ключовете си.',
           'библиотеката затваря в девет часа вечерта и отваря рано.',
           'те решиха да се приберат пеша, защото автобусът много '
           'закъсняваше.'],
    'el': ['δεν μπορούσε να βρει τα κλειδιά του πουθενά στο σπίτι.',
           'η βιβλιοθήκη κλείνει στις εννέα το βράδυ και ανοίγει '
           'νωρίς.',
           'αποφάσισαν να πάνε σπίτι με τα πόδια επειδή το λεωφορείο '
           'άργησε πολύ.'],
    'ar': ['لم يجد مفاتيحه في أي مكان في البيت.',
           'تغلق المكتبة في الساعة التاسعة مساء وتفتح مبكرا.',
           'قرروا العودة إلى البيت مشيا لأن الحافلة تأخرت كثيرا.'],
    'fa': ['او کلیدهایش را هیچ جای خانه پیدا نکرد.',
           'کتابخانه ساعت نه شب بسته می‌شود و صبح زود باز می‌شود.',
           'آنها تصمیم گرفتند پیاده به خانه بروند چون اتوبوس خیلی '
           'دیر کرد.'],
    'he': ['הוא לא מצא את המפתחות שלו בשום מקום בבית.',
           'הספרייה נסגרת בתשע בערב ונפתחת מוקדם.',
           'הם החליטו ללכת הביתה ברגל כי האוטובוס איחר מאוד.'],
    'hi': ['उसे घर में कहीं भी अपनी चाबियाँ नहीं मिलीं।',
           'पुस्तकालय रात नौ बजे बंद होता है और सुबह जल्दी खुलता है।',
           'बस बहुत देर से आने के कारण उन्होंने पैदल घर जाने का फ़ैसला किया।'],
    'zh': ['他在家里哪儿也找不到他的钥匙。',
           '图书馆晚上九点关门,早上很早开门。',
           '因为公共汽车晚点了,他们决定走路回家。'],
    'ja': ['彼は家の中のどこにも鍵を見つけられませんでした。',
           '図書館は夜九時に閉まり、朝は早く開きます。',
           'バスがとても遅れたので、彼らは歩いて家に帰ることにしました。'],
    'ko': ['그는 집 안 어디에서도 열쇠를 찾을 수 없었다.',
           '도서관은 저녁 아홉 시에 문을 닫고 아침 일찍 연다.',
           '버스가 너무 늦어서 그들은 걸어서 집에 가기로 했다.'],
    'th': ['เขาหากุญแจของเขาไม่เจอที่ไหนเลยในบ้าน',
           'ห้องสมุดปิดเวลาสามทุ่มและเปิดแต่เช้า',
           'พวกเขาตัดสินใจเดินกลับบ้านเพราะรถเมล์มาสายมาก'],
}


def norm_for_langid(col: Column | str,
                    prefix_chars: int | None = None) -> Column:
    """Language-ID text normalization, identical on every engine that
    replays it: lowercase, fold the two known cross-engine case-fold
    divergences (U+0307 from Java's dotted-I lowering; Greek final
    sigma, which Java lowers contextually and utf8proc does not),
    keep letters + combining marks + spaces (marks carry the signal in
    Devanagari/Thai/Arabic), collapse whitespace, optionally truncate,
    and pad one space on each side so edge n-grams see a word
    boundary. Empty-after-normalization yields NULL (caller maps to
    'und')."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, '\u0307', '')
    c = F.regexp_replace(c, 'ς', 'σ')
    c = F.regexp_replace(c, r'[^\p{L}\p{M} ]+', ' ')
    c = F.trim(F.regexp_replace(c, ' +', ' '))
    if prefix_chars is not None:
        c = F.substring(c, 1, prefix_chars)
    return F.when(F.coalesce(c, F.lit('')) == '', F.lit(None)) \
        .otherwise(F.concat(F.lit(' '), c, F.lit(' ')))


def char_ngrams(col: Column, sizes: tuple = NGRAM_SIZES) -> Column:
    """All overlapping character n-grams of the given sizes as one
    array — pure JVM ``sequence``/``transform``/``substr``, linear in
    the (already truncated) text. ``col`` is let-bound
    (functions/bind.py) so a derived expression (the normalizer) is
    evaluated once per row, not once per gram — unbound expressions
    re-evaluate per lambda element."""
    from erde_spark.functions.bind import bind

    def _window(c, n):
        # single-parameter closure: F.transform passes (element, index)
        # to 2-arg callables, so a `n=n` default would capture the
        # array index, not the gram size
        return lambda i: F.substr(c, i, F.lit(n))

    def _all(c):
        out = None
        for n in sizes:
            m = F.length(c) - (n - 1)
            grams = F.when(m >= 1,
                           F.transform(F.sequence(F.lit(1), F.greatest(
                               m, F.lit(1))), _window(c, n))) \
                .otherwise(F.array().cast('array<string>'))
            out = grams if out is None else F.concat(out, grams)
        return out

    return bind(col, _all)


@dataclass
class LangIdModel:
    """Trained identifier: a broadcastable wide model frame
    (``gram``, ``q_<lang>`` quantized log-probs), the sorted language
    list, per-language OOV log-prob constants (quantized), and the
    fixed-point scale."""
    df: DataFrame
    langs: list
    oov: dict
    scale: int
    alpha: float


def train_langid(spark: SparkSession, corpus: dict | None = None,
                 alpha: float = 0.5,
                 scale: int = LANGID_SCALE) -> LangIdModel:
    """Closed-form training: count char n-grams per language over the
    seed corpus, Laplace-smooth over the joint vocabulary, log,
    quantize to ``1/scale`` units. One aggregation + one pivot over a
    ~30-row input — the model (a few 10k rows x |langs| longs) is
    computed once and broadcast everywhere. No iteration, so a SQL
    engine replays it exactly (tests/test_langid.py does, in DuckDB)."""
    corpus = corpus if corpus is not None else LANGID_CORPUS
    langs = sorted(corpus)
    df = spark.createDataFrame(sorted(corpus.items()),
                               'lang string, text string')
    grams = df.select('lang',
                      F.explode(char_ngrams(norm_for_langid('text')))
                      .alias('gram'))
    counts = (grams.groupBy('gram').pivot('lang', langs)
              .agg(F.count(F.lit(1))).na.fill(0))
    tot = counts.agg(F.count(F.lit(1)).alias('_v'),
                     *[F.sum(lang).alias(lang) for lang in langs]).first()
    v = int(tot['_v'])
    n_lang = {lang: int(tot[lang]) for lang in langs}
    model = counts.select(
        'gram',
        *[F.round(F.log((F.col(lang) + alpha) /
                        F.lit(n_lang[lang] + alpha * v)) * scale)
          .cast('long').alias(f'q_{lang}') for lang in langs])
    # Materialize the model ONCE, with whole-stage codegen off for
    # just this job: the |langs|-column pivot fused with the |langs|
    # log/round projections generates a hashAgg output method past
    # janino's 64 KB limit whenever ALL columns materialize (a .count
    # prunes them, which is why the fallback only fired in full-value
    # harnesses), and spark.sql.codegen.methodSplitThreshold does not
    # split that method (measured at 128). Interpreted eval of a
    # few-10k-row model is microseconds, the model is trained once per
    # process and broadcast everywhere, and the eager localCheckpoint
    # means no consumer ever re-runs the wide projection — so this
    # also removes the repeated ERROR CodeGenerator noise + compile
    # attempt from every downstream job.
    prev = spark.conf.get('spark.sql.codegen.wholeStage', 'true')
    spark.conf.set('spark.sql.codegen.wholeStage', 'false')
    try:
        model = model.localCheckpoint(eager=True)
    finally:
        spark.conf.set('spark.sql.codegen.wholeStage', prev)
    oov = {lang: int(round(math.log(alpha / (n_lang[lang] + alpha * v))
                           * scale)) for lang in langs}
    return LangIdModel(df=model, langs=langs, oov=oov, scale=scale,
                       alpha=alpha)


_DEFAULT_MODEL: LangIdModel | None = None


def default_langid_model(spark: SparkSession) -> LangIdModel:
    """The 30-language model trained from :data:`LANGID_CORPUS`,
    trained once per process and cached (training is one sub-second
    job over a 30-row frame)."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None or _DEFAULT_MODEL.df.sparkSession is not spark:
        _DEFAULT_MODEL = train_langid(spark)
    return _DEFAULT_MODEL


def identify_language(docs: DataFrame, model: LangIdModel | None = None,
                      id_col: str = 'doc_id', text_col: str = 'text',
                      prefix_chars: int = 200) -> DataFrame:
    """(id, lang, lang_score) per document — the real language
    identifier a multilingual 100 TB curation pipeline gates on
    (replaces the 4-language marker-stopword heuristic ``lang_id``
    for anything beyond a cheap column-expression tag).

    Per document: normalize + truncate to ``prefix_chars``, explode
    char 1-3-grams, broadcast-join the model, sum each language's
    quantized log-probs in EXACT integer arithmetic (out-of-vocabulary
    grams contribute the language's smoothed OOV constant times the
    miss count), argmax with a deterministic lexicographic tie-break.
    Documents empty after normalization come back as ``('und', 0.0)``.
    ``lang_score`` is the winning mean log-prob per gram (more
    negative = less model-like; useful as a confidence cut).

    Scale shape: model broadcast (never a corpus shuffle by gram); the
    explode is bounded by ``prefix_chars`` and collapses in the
    map-side partial aggregate to one row of |langs| longs per
    document before the single shuffle."""
    m = model if model is not None else \
        default_langid_model(docs.sparkSession)
    grams = docs.select(
        F.col(id_col).alias('id'),
        F.explode(char_ngrams(norm_for_langid(text_col, prefix_chars)))
        .alias('gram'))
    j = grams.join(F.broadcast(m.df), 'gram', 'left')
    agg = j.groupBy('id').agg(
        F.count(F.lit(1)).alias('_tot'),
        F.count(F.col(f'q_{m.langs[0]}')).alias('_hit'),
        *[F.sum(F.coalesce(F.col(f'q_{lang}'), F.lit(0)))
          .alias(f'_s_{lang}') for lang in m.langs])
    miss = F.col('_tot') - F.col('_hit')
    totals = {lang: (F.col(f'_s_{lang}') + miss * F.lit(m.oov[lang]))
              for lang in m.langs}
    # argmax via array_position, NOT a |langs|-deep CASE chain: the
    # chain inlined every totals expression twice (once per WHEN, once
    # inside greatest) into the hashAgg output method, which put the
    # generated Java past janino's 64 KB limit whenever all columns
    # materialized (ERROR CodeGenerator + interpreted fallback, seen
    # in full-value harnesses; a .count() pruned it away). The array
    # build names each totals expression ONCE; array_position's
    # first-match rule keeps the deterministic first-in-sorted-order
    # tie-break the DuckDB replay pins.
    arr = F.array(*[totals[lang] for lang in m.langs])
    best = F.array_max(arr)
    lang_expr = F.coalesce(
        F.element_at(F.array(*[F.lit(lang) for lang in m.langs]),
                     F.array_position(arr, best).cast('int')),
        F.lit('und'))
    scored = agg.select(
        'id', lang_expr.alias('lang'),
        (best / F.lit(m.scale) / F.col('_tot')).alias('lang_score'))
    # empty/None-normalized docs have no gram rows: re-attach as 'und'
    return (docs.select(F.col(id_col).alias('id')).distinct()
            .join(scored, 'id', 'left')
            .select('id',
                    F.coalesce('lang', F.lit('und')).alias('lang'),
                    F.coalesce('lang_score', F.lit(0.0))
                    .alias('lang_score')))
